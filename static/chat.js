// Run-scoped chat on the report detail page.
(function () {
  var root = document.getElementById('chat');
  if (!root) return;
  var runId = root.dataset.runId;
  var csrf = root.dataset.csrf || '';
  var messages = document.getElementById('chat-messages');
  var input = document.getElementById('chat-text');
  var send = document.getElementById('chat-send');

  function append(role, text) {
    var div = document.createElement('div');
    div.className = 'chat-msg chat-' + role;
    var who = document.createElement('strong');
    who.textContent = role === 'user' ? 'You:' : 'Assistant:';
    div.appendChild(who);
    div.appendChild(document.createTextNode(' ' + text));
    messages.appendChild(div);
    messages.scrollTop = messages.scrollHeight;
  }

  function submit() {
    if (send.disabled) return;  // a request is already in flight
    var text = input.value.trim();
    if (!text) return;
    input.value = '';
    append('user', text);
    send.disabled = true;
    fetch('/api/chat', {
      method: 'POST',
      headers: {
        'Content-Type': 'application/json',
        'X-CSRF-Token': csrf,
      },
      body: JSON.stringify({ run_id: runId, message: text }),
    })
      .then(function (r) { return r.json(); })
      .then(function (data) {
        append('assistant', data.reply || data.error || 'no reply');
      })
      .catch(function () { append('assistant', 'Chat failed — try again.'); })
      .finally(function () { send.disabled = false; });
  }

  send.addEventListener('click', submit);
  input.addEventListener('keydown', function (e) {
    if (e.key === 'Enter') submit();
  });
})();
